package graft.pipeline

import java.nio.file.{Files, Paths}

/** The reference's 17-row sample fixtures (reference `samples/`,
  * byte-identical copies in `dbt/seeds/`), recreated as literals so the
  * demo pipeline and golden tests are self-contained. */
object SampleData {

  val erpOrdersCsv: String =
    """order_id,customer_id,store_id,dt,order_value,status
      |1001,C001,store_01,2024-06-01,249.99,shipped
      |1002,C002,store_01,2024-06-01,89.50,processing
      |1003,C003,store_02,2024-06-02,120.00,cancelled
      |1004,C002,store_02,2024-06-03,45.90,processing
      |1005,C004,store_03,2024-06-03,560.10,shipped
      |""".stripMargin

  val crmLeadsCsv: String =
    """lead_id,name,email,source,status,store_id,dt
      |L001,Alice Smith,alice@example.com,web,contacted,store_01,2024-06-01
      |L002,Bob Jones,bob@example.com,event,qualified,store_02,2024-06-02
      |L003,Carla Gomez,carla@example.com,partner,converted,store_01,2024-06-03
      |L004,Daniel Ito,daniel@example.com,web,new,store_03,2024-06-03
      |""".stripMargin

  val productsCsv: String =
    """product_id,name,category,price,active,store_id,dt
      |P001,Noise Cancelling Headphones,Audio,199.99,true,store_01,2024-06-01
      |P002,Wireless Mouse,Accessories,29.99,true,store_01,2024-06-01
      |P003,4K Monitor,Displays,329.00,true,store_02,2024-06-02
      |P004,USB-C Dock,Accessories,119.00,false,store_02,2024-06-02
      |""".stripMargin

  val webEventsJson: String =
    """{"event_id":"E001","visitor_id":"V100","store_id":"store_01","dt":"2024-06-01","page":"/home","event_type":"page_view","metadata":{"utm_source":"newsletter"}}
      |{"event_id":"E002","visitor_id":"V101","store_id":"store_01","dt":"2024-06-01","page":"/product/P001","event_type":"click","metadata":{"cta":"add_to_cart"}}
      |{"event_id":"E003","visitor_id":"V200","store_id":"store_02","dt":"2024-06-02","page":"/search","event_type":"page_view","metadata":{"query":"monitor"}}
      |{"event_id":"E004","visitor_id":"V300","store_id":"store_03","dt":"2024-06-03","page":"/home","event_type":"page_view","metadata":{}}
      |""".stripMargin

  /** Write the four raw files into `dir`. */
  def writeTo(dir: String): String = {
    Files.createDirectories(Paths.get(dir))
    Files.writeString(Paths.get(dir, "erp_orders.csv"), erpOrdersCsv)
    Files.writeString(Paths.get(dir, "crm_leads.csv"), crmLeadsCsv)
    Files.writeString(Paths.get(dir, "products.csv"), productsCsv)
    Files.writeString(Paths.get(dir, "web_events.json"), webEventsJson)
    dir
  }
}
